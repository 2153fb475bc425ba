from . import bz2_dump, generator, io, warc, wiki  # noqa: F401
