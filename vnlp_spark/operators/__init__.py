from . import stopwords, morphology  # noqa: F401
