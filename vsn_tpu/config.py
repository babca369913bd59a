"""Config / flag system.

Reproduces the reference's two-level YAML config protocol (reference:
config-defaults.yaml:1-306 and train/train_transformer.py:2398-2457) without
using W&B as the runtime config registry:

  * a defaults file where every key maps to ``{desc: ..., value: ...}``;
  * per-experiment override YAMLs with the same schema, applied key-by-key
    (taking the ``value`` sub-key);
  * CLI overrides for ``FOLD`` and ``SEED`` (``SEED`` accepts none/false/int,
    reference utils/seed.py:12-34);
  * computed keys written back (e.g. GRADIENT_ACCUMULATION, reference
    train/train_transformer.py:2157-2160);
  * the final merged config is dumped to ``config.yaml`` in the run directory.

The runtime object is an immutable mapping with attribute access; model and
training code read the same public key names as the reference
(ARCHITECTURE / DISEASES / STEPS / EFFECTIVE_BATCH_SIZE / ...).
"""

from __future__ import annotations

import math
import os
from pathlib import Path
from typing import Any, Iterator, Mapping

import yaml

_PKG_DIR = Path(__file__).resolve().parent
DEFAULT_CONFIG_PATH = _PKG_DIR / "configs" / "config-defaults.yaml"


def _unwrap(node: Any) -> Any:
    """Extract the ``value`` sub-key from a ``{desc, value}`` node."""
    if isinstance(node, Mapping) and "value" in node:
        return node["value"]
    return node


def normalize_seed(seed: Any) -> int | None:
    """Normalize the SEED flag: None/False/'none'/'false' disable seeding.

    Mirrors reference utils/seed.py:12-34 (normalize_seed).
    """
    if seed is None or seed is False:
        return None
    if isinstance(seed, str):
        if seed.strip().lower() in ("none", "false", ""):
            return None
        return int(seed)
    if isinstance(seed, bool):  # True is not a valid seed
        raise ValueError("SEED=True is not a valid seed; use an integer")
    return int(seed)


class Config(Mapping):
    """Immutable config mapping with attribute access.

    ``cfg.STEPS`` and ``cfg["STEPS"]`` both work. ``replace(**kw)`` returns a
    new Config with the given keys overridden (the jit-side analogue of the
    reference writing computed keys back into ``w.config``).
    """

    __slots__ = ("_d",)

    def __init__(self, d: Mapping[str, Any]):
        object.__setattr__(self, "_d", dict(d))

    # Mapping protocol -----------------------------------------------------
    def __getitem__(self, key: str) -> Any:
        return self._d[key]

    def __iter__(self) -> Iterator[str]:
        return iter(self._d)

    def __len__(self) -> int:
        return len(self._d)

    # Attribute access ------------------------------------------------------
    def __getattr__(self, key: str) -> Any:
        try:
            return self._d[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __setattr__(self, key: str, value: Any):
        raise AttributeError("Config is immutable; use .replace()")

    def __repr__(self) -> str:
        return f"Config({self._d!r})"

    def replace(self, **kwargs: Any) -> "Config":
        d = dict(self._d)
        d.update(kwargs)
        return Config(d)

    def get(self, key: str, default: Any = None) -> Any:
        return self._d.get(key, default)

    def to_dict(self) -> dict:
        return dict(self._d)

    # Derived quantities ----------------------------------------------------
    @property
    def num_classes(self) -> int:
        return len(self.DISEASES)

    @property
    def seed_or_none(self) -> int | None:
        return normalize_seed(self.get("SEED"))

    def gradient_accumulation_steps(self, world_size: int = 1) -> int:
        """ceil(EFFECTIVE_BATCH_SIZE / (BATCH_SIZE * world_size)).

        Mirrors reference train/train_transformer.py:163-194
        (compute_gradient_accumulation_steps).
        """
        per_step = self.BATCH_SIZE * world_size
        if per_step <= 0:
            raise ValueError("BATCH_SIZE * world_size must be positive")
        if self.EFFECTIVE_BATCH_SIZE < per_step:
            raise ValueError(
                f"EFFECTIVE_BATCH_SIZE={self.EFFECTIVE_BATCH_SIZE} smaller than "
                f"BATCH_SIZE*world={per_step}"
            )
        return math.ceil(self.EFFECTIVE_BATCH_SIZE / per_step)

    @property
    def input_size(self) -> tuple[int, int, int]:
        """Effective model input size: RESHAPE_SIZE if set, else IMG_SIZE."""
        rs = self.get("RESHAPE_SIZE", False)
        if rs and rs is not False:
            return tuple(int(v) for v in rs)
        return tuple(int(v) for v in self.IMG_SIZE)


def load_yaml_values(path: str | os.PathLike) -> dict:
    """Load a ``{KEY: {desc, value}}`` YAML file into a flat ``{KEY: value}``."""
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    return {k: _unwrap(v) for k, v in raw.items()}


def load_config(
    override_path: str | os.PathLike | None = None,
    defaults_path: str | os.PathLike | None = None,
    fold: int | None = None,
    seed: Any = "__unset__",
    extra_overrides: Mapping[str, Any] | None = None,
) -> Config:
    """Load defaults, apply an override YAML key-by-key, then CLI overrides.

    Mirrors the merge loop at reference train/train_transformer.py:2398-2425:
    override keys replace default values; ``--fold`` and ``--seed`` CLI flags
    take final precedence; SEED is normalized.
    """
    defaults_path = defaults_path or DEFAULT_CONFIG_PATH
    values = load_yaml_values(defaults_path)

    if override_path is not None:
        overrides = load_yaml_values(override_path)
        unknown = set(overrides) - set(values)
        # Unknown keys are accepted (the reference merges blindly) but kept.
        values.update(overrides)
        del unknown

    if fold is not None:
        values["FOLD"] = int(fold)
    if seed != "__unset__":
        values["SEED"] = seed
    values["SEED"] = normalize_seed(values.get("SEED"))

    if extra_overrides:
        values.update(extra_overrides)

    return Config(values)


def save_config(cfg: Config, run_dir: str | os.PathLike, name: str = "config.yaml"):
    """Persist the merged config (flat values) to the run directory.

    The reference saves the merged W&B config per run
    (train/train_transformer.py:2451-2457); we save the flat mapping.
    """
    run_dir = Path(run_dir)
    run_dir.mkdir(parents=True, exist_ok=True)
    path = run_dir / name
    with open(path, "w") as f:
        yaml.safe_dump(cfg.to_dict(), f, sort_keys=True)
    return path
