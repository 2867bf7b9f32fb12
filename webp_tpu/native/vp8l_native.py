"""Native C++ fast-path bindings for VP8L entropy loops (stub until built)."""

def available() -> bool:
    return False

def decode_image_data(dec, width, height):
    return None
