from . import minhash, normalize, similarity, text  # noqa: F401
