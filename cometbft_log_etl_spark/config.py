"""YAML config-file parsing — parity with the reference's plugin block.

Mirrors /root/reference/internal/config/config.go:48-83 and the README's
`config.yaml` example:

    plugins:
      - name: "vote-latency"
        enabled: true
      - name: "peer-participation"   # premium/custom; tolerated if absent

Reference semantics reproduced exactly:
- empty path / unreadable file / malformed YAML → no plugin block, never
  fatal (config.go:50-61 returns nil on every error path);
- an empty plugin block falls back to the default core set, all enabled
  (ensureDefaultCoreProcessors, config.go:67-83);
- `enabled: false` entries are skipped at load time
  (pluginloader/loader.go:35-37);
- enabled-but-unregistered names are warned about and skipped, never
  fatal (loader.go:38-45) — handled downstream by
  plans.registry.run_plugins.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class PluginConfig:
    """One entry of the YAML `plugins:` list (pkg/pluginsdk PluginConfig)."""

    name: str
    # Go zero value: an entry without `enabled:` is DISABLED
    # (config.go:68 `Enabled bool` + yaml absent → false); the loader
    # below and this default must agree.
    enabled: bool = False


def load_plugins_from_yaml(path: str | None) -> list[PluginConfig]:
    """Parse the `plugins:` block; every error path returns [] (never
    fatal), matching config.go:48-63."""
    if not path:
        return []
    try:
        import yaml

        with open(path) as fh:
            raw = yaml.safe_load(fh)
    except Exception:  # unreadable / malformed — reference returns nil
        return []
    if not isinstance(raw, dict) or not isinstance(raw.get("plugins"), list):
        return []
    out: list[PluginConfig] = []
    for entry in raw["plugins"]:
        if not isinstance(entry, dict) or not entry.get("name"):
            continue
        out.append(PluginConfig(name=str(entry["name"]), enabled=bool(entry.get("enabled", False))))
    return out


def enabled_plugin_names(path: str | None) -> list[str] | None:
    """CLI-facing resolution: YAML path → list of enabled plugin names,
    or None for "use the default core set" (an empty/absent plugin block
    — ensureDefaultCoreProcessors' fallback, config.go:67-83)."""
    cfgs = load_plugins_from_yaml(path)
    if not cfgs:
        return None
    return [c.name for c in cfgs if c.enabled]
