from . import corpus, pipeline, lineage  # noqa: F401
