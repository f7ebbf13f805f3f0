"""Global execution context singleton.

Parity: reference ``simseg/utils/context.py:13-119`` — the ENV singleton
carrying rank/size/local device info, the active config and its snapshot,
plus ``root_only`` decorators gating host-side work to process 0. On TPU the
identity comes from ``jax.process_index/process_count`` and the local device
list instead of torch.distributed ranks.
"""

from __future__ import annotations

import functools
from typing import Any, Callable


class _Singleton(type):
    _instances: dict = {}

    def __call__(cls, *args, **kwargs):
        if cls not in cls._instances:
            cls._instances[cls] = super().__call__(*args, **kwargs)
        return cls._instances[cls]


class GlobalContext(metaclass=_Singleton):
    def __init__(self) -> None:
        self.cfg: Any = None
        self.cfg_snapshot: Any = None
        self.mesh: Any = None
        self.dist_mode: str = "jax"

    # -- process identity -------------------------------------------------------
    @property
    def rank(self) -> int:
        try:
            import jax
            return jax.process_index()
        except Exception:
            return 0

    @property
    def size(self) -> int:
        try:
            import jax
            return jax.process_count()
        except Exception:
            return 1

    @property
    def local_rank(self) -> int:
        return 0  # one process drives all local chips on TPU

    @property
    def is_root(self) -> bool:
        return self.rank == 0

    @property
    def devices(self):
        import jax
        return jax.local_devices()

    @property
    def device(self):
        return self.devices[0]

    @property
    def device_count(self) -> int:
        import jax
        return jax.device_count()


ENV = GlobalContext()


def root_only(fn: Callable) -> Callable:
    """Run only on process 0 (parity: context.py root_only)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if ENV.is_root:
            return fn(*args, **kwargs)
        return None

    return wrapper


def local_root_only(fn: Callable) -> Callable:
    """Run on each host's local root (parity: context.py local_root_only,
    which gates to local_rank == 0 — once per node). One TPU process drives
    all of its host's chips, so every process IS its host's local root and
    the gate always passes; per-host work (local cache dirs, per-host logs)
    must run on every process, not only the global root."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if ENV.local_rank == 0:
            return fn(*args, **kwargs)
        return None

    return wrapper
