from . import (  # noqa: F401
    ann,
    blocking,
    candidates,
    classify,
    cluster,
    dedup,
    evaluate,
    features,
    joins,
    multimodal,
    quality,
    resolve,
)
