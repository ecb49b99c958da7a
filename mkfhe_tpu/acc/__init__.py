from . import cggi, dm, xzddf, xzw  # noqa: F401
