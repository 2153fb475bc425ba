from . import generator, io, warc  # noqa: F401
