"""Op-level device profile of the production batched encoder via
jax.profiler: dumps the top ops by self time from the xplane trace."""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from webp_tpu.ops import fastpath as FP

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
W, H = 1536, 1024
fn = FP.fast_encode_fn(W // 16, H // 16, 75, 4, 50, True)

src = Image.open("/root/reference/testdata/test_color.png").convert(
    "RGB").resize((W, H))
pad = np.broadcast_to(np.asarray(src), (B, H, W, 3)).copy()
dev_in = jax.device_put(pad)


def sync(out):
    _ = np.asarray(out[-1])


sync(fn.rgb_blob(dev_in))  # compile+warm

logdir = "/tmp/jaxprof"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    for _ in range(2):
        sync(fn.rgb_blob(dev_in))

# Parse the xplane: per-op totals on the device planes.
from tensorflow.python.profiler.internal import _pywrap_profiler_plugin  # noqa
xp = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
print("xplane files:", xp)
if not xp:
    sys.exit(1)

from xprof.convert import raw_to_tool_data as rtd  # type: ignore

try:
    data, _ = rtd.xspace_to_tool_data(xp, "op_profile", {})
    open("/tmp/op_profile.json", "wb").write(
        data if isinstance(data, bytes) else data.encode())
    print("wrote /tmp/op_profile.json")
except Exception as e:
    print("op_profile failed:", e)
    # Fallback: raw xplane decode
    from tensorflow.core.profiler.protobuf import xplane_pb2  # type: ignore

    for f in xp:
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(f, "rb").read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "Device" not in plane.name:
                continue
            ev_name = {i: m.name for i, m in plane.event_metadata.items()}
            tot = {}
            for line in plane.lines:
                for ev in line.events:
                    n = ev_name.get(ev.metadata_id, str(ev.metadata_id))
                    tot[n] = tot.get(n, 0) + ev.duration_ps
            top = sorted(tot.items(), key=lambda kv: -kv[1])[:40]
            s = sum(tot.values())
            print(f"== plane {plane.name}: total {s/1e12*1e3:.1f} ms")
            for n, d in top:
                print(f"  {d/1e12*1e3:8.2f} ms  {n[:110]}")
