from .scalars import (  # noqa: F401
    extract_peer_id,
    format_source_peer,
    format_step,
    go_duration_ms,
    parse_round_info,
    parse_rfc3339,
)
