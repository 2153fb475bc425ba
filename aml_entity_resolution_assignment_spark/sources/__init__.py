from . import generator, io  # noqa: F401
