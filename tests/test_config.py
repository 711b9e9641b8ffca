"""YAML plugin-block parity (internal/config/config.go:48-83): the
README's config.yaml example shape must parse, error paths must be
tolerant (never fatal), and disabled/unknown entries must follow the
reference loader's skip semantics."""

from __future__ import annotations

from cometbft_log_etl_spark.config import (
    PluginConfig,
    enabled_plugin_names,
    load_plugins_from_yaml,
)

# The reference README's example config (README.md:45-63), including the
# premium/custom placeholder that is configured but not in the registry.
README_EXAMPLE = """\
plugins:
  - name: "vote-latency"
    enabled: true
  - name: "block-parts"
    enabled: true
  - name: "p2p-messages"
    enabled: true
  - name: "consensus-steps"
    enabled: true
  - name: "consensus-timing"
    enabled: true
  - name: "validator-participation"
    enabled: true
  - name: "network-latency"
    enabled: true
  - name: "timeout-analysis"
    enabled: true
  - name: "peer-participation"
    enabled: true
"""


def test_readme_example_parses(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text(README_EXAMPLE)
    cfgs = load_plugins_from_yaml(str(p))
    assert cfgs[0] == PluginConfig(name="vote-latency", enabled=True)
    assert len(cfgs) == 9
    assert all(c.enabled for c in cfgs)


def test_disabled_entries_are_skipped(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text(
        "plugins:\n"
        "  - name: vote-latency\n    enabled: true\n"
        "  - name: network-latency\n    enabled: false\n"
        "  - name: block-parts\n"  # enabled omitted → false (Go zero value)
    )
    assert enabled_plugin_names(str(p)) == ["vote-latency"]


def test_error_paths_never_fatal(tmp_path):
    assert load_plugins_from_yaml(None) == []
    assert load_plugins_from_yaml(str(tmp_path / "missing.yaml")) == []
    bad = tmp_path / "bad.yaml"
    bad.write_text("plugins: [:::")
    assert load_plugins_from_yaml(str(bad)) == []
    scalar = tmp_path / "scalar.yaml"
    scalar.write_text("just a string")
    assert load_plugins_from_yaml(str(scalar)) == []


def test_empty_block_falls_back_to_default_set(tmp_path):
    # ensureDefaultCoreProcessors: no plugin block → the default core
    # set; run_plugins(None) resolves to registry.DEFAULT_ENABLED.
    p = tmp_path / "empty.yaml"
    p.write_text("plugins: []\n")
    assert enabled_plugin_names(str(p)) is None
    assert enabled_plugin_names(None) is None


def test_unknown_plugin_tolerated_end_to_end(tmp_path):
    # loader.go:38-45: enabled-but-unregistered → warn + skip, not fatal.
    from cometbft_log_etl_spark.plans.registry import plugins

    p = tmp_path / "config.yaml"
    p.write_text("plugins:\n  - name: peer-participation\n    enabled: true\n")
    names = enabled_plugin_names(str(p))
    assert names == ["peer-participation"]
    assert "peer-participation" not in plugins()  # registry skip path covers it
