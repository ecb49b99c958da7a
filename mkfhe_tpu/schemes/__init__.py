from . import lwe  # noqa: F401
