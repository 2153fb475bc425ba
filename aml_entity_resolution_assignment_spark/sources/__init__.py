from . import bz2_dump, generator, io, warc  # noqa: F401
