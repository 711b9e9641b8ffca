from .raws import KNOWN_TAGS, UNION_SCHEMA, canonical_tag_expr  # noqa: F401
