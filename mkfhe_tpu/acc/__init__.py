from . import cggi, xzddf, xzw  # noqa: F401
