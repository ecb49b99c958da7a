from . import cggi  # noqa: F401
