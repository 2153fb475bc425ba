from . import blocking, candidates, classify, cluster, evaluate, features  # noqa: F401
