"""O5/O6: plugin registry — named DataFrame transforms over the
normalized events stream.

Reference: pkg/pluginloader/loader.go:13-74 (Register/Init/Process/
Finalize lifecycle) and pkg/pluginsdk/interfaces.go:10-25. In Spark the
lifecycle collapses to a pure function `f(events_df) -> dict[table_name,
DataFrame]`; the single-pass fan-out (main.go:77-79) becomes running
every enabled plugin off one cached events DataFrame.

The default-enabled set mirrors internal/config/config.go:67-83.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

PluginFn = Callable[[DataFrame], dict[str, DataFrame]]

_PLUGINS: dict[str, PluginFn] = {}

# internal/config/config.go:71-81 default-enabled list.
DEFAULT_ENABLED = (
    "vote-latency",
    "block-parts",
    "p2p-messages",
    "consensus-steps",
    "consensus-timing",
    "validator-participation",
    "timeout-analysis",
    "tracer-events",
    "network-latency",
)


def register_plugin(name: str):
    def deco(fn: PluginFn) -> PluginFn:
        _PLUGINS[name] = fn
        return fn

    return deco


def _load_all() -> None:
    from . import (  # noqa: F401
        block_parts,
        consensus_steps,
        consensus_timing,
        network_latency,
        p2p_messages,
        timeout_analysis,
        tracer_events,
        validator_participation,
        vote_latency,
    )


def plugins() -> dict[str, PluginFn]:
    _load_all()
    return dict(_PLUGINS)


def run_plugins(
    events: DataFrame, enabled: list[str] | None = None, max_workers: int = 4
) -> dict[str, DataFrame]:
    """Run each enabled plugin; returns the union of their result tables.

    An enabled-but-unregistered name is warned about and skipped, never
    fatal — the reference tolerates configured premium/custom plugins
    that aren't linked into the binary (pkg/pluginloader/loader.go:38-45).

    Plugins are pure plan builders (no execution), but building nine
    deep plan trees is driver-side work — hundreds of py4j round-trips
    each — so independent plugins build on a small thread pool (py4j
    releases the GIL on socket I/O). Result ordering stays deterministic:
    tables merge in `names` order regardless of completion order.
    """
    import logging
    from concurrent.futures import ThreadPoolExecutor

    reg = plugins()
    names = list(enabled) if enabled is not None else list(DEFAULT_ENABLED)
    known = [n for n in names if n in reg]
    for name in names:
        if name not in reg:
            logging.getLogger(__name__).warning(
                "plugin %r not found in registry; continuing without it", name
            )
    if max_workers > 1 and len(known) > 1:
        with ThreadPoolExecutor(max_workers=max_workers) as pool:
            built = dict(zip(known, pool.map(lambda n: reg[n](events), known)))
    else:
        built = {n: reg[n](events) for n in known}
    out: dict[str, DataFrame] = {}
    for name in known:
        for table, df in built[name].items():
            if table in out:
                raise ValueError(f"plugin {name!r} re-emits table {table!r}")
            out[table] = df
    return out
