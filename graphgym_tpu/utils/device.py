"""Device management (reference graphgym/utils/device.py:9-65).

The reference probes nvidia-smi and greedily picks the freest GPU; the
TPU-native equivalent reports/pins JAX devices and exposes per-device
memory stats for logging (cfg.gpu_mem analog)."""

from __future__ import annotations

import logging
from typing import Optional


def auto_select_device(cfg=None) -> str:
    """Resolve cfg.device ('auto' -> first accelerator, else cpu) and
    return the platform name."""
    import jax

    want = getattr(cfg, "device", "auto") if cfg is not None else "auto"
    if want not in ("auto", "cpu", "tpu"):
        want = "auto"
    devices = jax.devices()
    platform = devices[0].platform
    if want == "cpu" and platform != "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
            platform = "cpu"
        except Exception:
            logging.warning("Could not force CPU platform")
    if cfg is not None:
        cfg.device = platform
    logging.info("Using device: %s (%d available)", platform,
                 len(devices))
    return platform


def get_device_memory() -> Optional[dict]:
    """Per-device memory stats where the backend exposes them
    (reference get_gpu_memory_map, device.py:20-35)."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
        except Exception:
            stats = None
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    return out or None
