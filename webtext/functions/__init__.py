from . import ann, dedup, media, textstats  # noqa: F401
