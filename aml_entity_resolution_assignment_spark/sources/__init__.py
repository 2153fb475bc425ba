from . import bz2_dump, generator, io, warc, wat, wiki  # noqa: F401
