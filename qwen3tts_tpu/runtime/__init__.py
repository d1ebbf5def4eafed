from . import decode_loop  # noqa: F401
