"""Configuration system: nested dict with dotted-key access and JSON persistence.

Capability parity with the reference config manager (/root/reference/config.py:6-88):
singleton with nested defaults, ``get``/``set`` on dotted keys, ``save_to_file`` /
``load_from_file`` JSON round-trip, and the quality-threshold helpers. The defaults
mirror the reference's shipped values (config.py:18-51) so behavior-sensitive
consumers (compression flags, sample rate, assembly thresholds) see the same policy.

Deviation from the reference (documented in COMPAT.md): the reference's ``get``
returns the default only when the key walk ends in ``{}`` (config.py:53-58), which
makes an intermediate *present* empty dict indistinguishable from a missing key and
crashes when walking through a non-dict leaf. We implement the intended behavior —
missing key => default, present value (including falsy) => value.
"""

from __future__ import annotations

import copy
import json
import os
import threading
from typing import Any, Dict

_DEFAULTS: Dict[str, Any] = {
    "modem": {
        "dsss_spreading_codes": {
            "default": [1, 0, 1, 1, 0, 0, 1, 1, 1, 0, 0, 1, 0, 1, 0, 0],
            "secure": [1, 1, 0, 1, 0, 1, 1, 0, 0, 1, 1, 0, 1, 0, 0, 1],
        },
        "fec_enabled": True,
        "fec_type": "reed_solomon",  # 'reed_solomon' or 'convolutional'
        # CFO robustness in the batched PSK decode (derotation + quarter-turn
        # sync retry); ~15% throughput cost. Disable for carrier-exact farms.
        "cfo_retry": True,
        # MLSE refinement in the BATCHED FSK decode (the single-file path
        # always runs it): ~3x throughput cost for a ~1.5e-5 -> 0 BER gain.
        "batch_mlse": False,
        "sample_rate": 96000,
        "quality_threshold": 0.4,
        "duplicate_replacement_threshold": 0.15,
        "assembly_timeout": 7200,
        "max_quality_samples": 2000,
        "adaptive_equalization": True,
        "noise_reduction": True,
    },
    "compression": {
        "enabled": True,
        "aggressive_threshold": 1024,
        "lzma_enabled": True,
        "delta_compression": True,
    },
    "performance": {
        "max_workers": 4,
        "buffer_size": 8192,
        "real_time_processing": True,
        "cache_enabled": True,
    },
    "ui": {
        "auto_save_logs": True,
        "refresh_interval": 1000,
        "theme": "dark",
    },
    # TPU-rebuild-specific knobs (no reference analog).
    "tpu": {
        "demod_backend": "auto",  # 'auto' | 'xla' | 'pallas'
        "batch_bucket_sizes": [1 << 16, 1 << 18, 1 << 20, 1 << 22, 1 << 24, 1 << 25],
        "timing_offsets": 8,  # symbol-timing hypotheses searched in parallel
    },
}

_MISSING = object()


class ConfigManager:
    """Thread-safe singleton configuration store with dotted-key access."""

    _instance = None
    _lock = threading.Lock()

    def __new__(cls):
        if cls._instance is None:
            with cls._lock:
                if cls._instance is None:
                    inst = super().__new__(cls)
                    inst._config = copy.deepcopy(_DEFAULTS)
                    cls._instance = inst
        return cls._instance

    def get(self, key: str, default: Any = None) -> Any:
        node: Any = self._config
        for part in key.split("."):
            if isinstance(node, dict):
                node = node.get(part, _MISSING)
            else:
                node = _MISSING
            if node is _MISSING:
                return default
        return node

    def set(self, key: str, value: Any) -> None:
        parts = key.split(".")
        node = self._config
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value

    def save_to_file(self, filename: str = "filebeep_config.json") -> None:
        with open(filename, "w") as f:
            json.dump(self._config, f, indent=2)

    def load_from_file(self, filename: str = "filebeep_config.json") -> None:
        if os.path.exists(filename):
            with open(filename) as f:
                self._config.update(json.load(f))

    def reset(self) -> None:
        """Restore shipped defaults (mainly for tests)."""
        self._config = copy.deepcopy(_DEFAULTS)


CONFIG = ConfigManager()


def get_quality_threshold() -> float:
    return CONFIG.get("modem.quality_threshold", 0.3)


def set_quality_threshold(value: float) -> None:
    CONFIG.set("modem.quality_threshold", max(0.0, min(1.0, value)))
