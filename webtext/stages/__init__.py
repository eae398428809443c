from .extractor import ExtractorActor, RESULT_SCHEMA  # noqa: F401
