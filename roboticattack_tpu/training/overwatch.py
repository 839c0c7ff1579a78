"""Process-aware logging (the reference's `overwatch`, prismatic/overwatch/).

`DistributedOverwatch` gated logging on accelerate's rank; here process
identity comes from `jax.process_index()` — the multi-host JAX equivalent —
and single-process runs behave like `PureOverwatch` (overwatch.py:95-147).
"""

from __future__ import annotations

import logging
import sys
from functools import wraps

_FORMAT = "%(asctime)s | %(levelname)s | %(name)s :: %(message)s"


def _is_rank_zero() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


class Overwatch:
    def __init__(self, name: str) -> None:
        self.logger = logging.getLogger(name)
        if not self.logger.handlers:
            handler = logging.StreamHandler(sys.stdout)
            handler.setFormatter(logging.Formatter(_FORMAT, datefmt="%H:%M:%S"))
            self.logger.addHandler(handler)
            self.logger.setLevel(logging.INFO if _is_rank_zero() else logging.ERROR)

    def info(self, msg: str, *args) -> None:
        self.logger.info(msg, *args)

    def warning(self, msg: str, *args) -> None:
        self.logger.warning(msg, *args)

    def error(self, msg: str, *args) -> None:
        self.logger.error(msg, *args)

    def rank_zero_only(self, fn):
        """Decorator: run `fn` only on process 0 (overwatch.py:75-92)."""

        @wraps(fn)
        def wrapper(*args, **kwargs):
            if _is_rank_zero():
                return fn(*args, **kwargs)
            return None

        return wrapper

    @property
    def rank(self) -> int:
        import jax

        return jax.process_index()

    @property
    def world_size(self) -> int:
        import jax

        return jax.process_count()

    def is_rank_zero(self) -> bool:
        return _is_rank_zero()


def initialize_overwatch(name: str) -> Overwatch:
    return Overwatch(name)
