from . import decode_loop  # noqa: F401
from . import continuous  # noqa: F401
