"""F3 — config dataclasses + signature-reflection builder.

Reference: config_maker.py:6-42 builds a ``SplitConfig`` dataclass from
``RandomLinkSplit.__init__``'s signature so the config surface tracks the
library's. Same trick here, engine-flavored: ``config_from_signature``
reflects any callable into a dataclass with its defaults; the concrete
configs mirror model.py:10-44 (GATConfig/TrainConfig with the derived
``depth_sizes = [num_neighbors] * num_layers``).
"""

from __future__ import annotations

import dataclasses
import inspect
from dataclasses import dataclass, field, make_dataclass
from typing import Any


def config_from_signature(fn, name: str | None = None,
                          exclude: tuple[str, ...] = ("self",)):
    """Dataclass type whose fields mirror ``fn``'s parameters+defaults
    (config_maker.py:6-42)."""
    sig = inspect.signature(fn)
    fields: list[tuple[str, Any, Any]] = []
    for p in sig.parameters.values():
        if p.name in exclude or p.kind in (p.VAR_POSITIONAL, p.VAR_KEYWORD):
            continue
        default = p.default if p.default is not inspect.Parameter.empty else None
        ann = p.annotation if p.annotation is not inspect.Parameter.empty else Any
        fields.append((p.name, ann, field(default=default)))
    return make_dataclass(name or f"{fn.__name__.title()}Config", fields)


@dataclass
class SplitConfig:
    """L1 parameters (params.yaml:8-9, train.py:23-29)."""
    num_val: float = 0.15
    num_test: float = 0.0
    is_undirected: bool = False
    add_negative_train_samples: bool = False
    seed: int = 42


@dataclass
class GNNConfig:
    """Encoder shape (model.py:10-24; params.yaml:11-19)."""
    num_layers: int = 2
    hidden_size: int = 10
    dropout: float = 0.15
    num_neighbors: int = 15
    seed: int = 42

    @property
    def depth_sizes(self) -> list[int]:
        """Per-layer fanout (model.py:42-44)."""
        return [self.num_neighbors] * self.num_layers


@dataclass
class TrainConfig:
    """Trainer loop parameters (model.py:27-44, params.yaml:11-19)."""
    batch_size: int = 512
    learn_rate: float = 0.01
    max_epochs: int = 3
    gnn: GNNConfig = field(default_factory=GNNConfig)
    split: SplitConfig = field(default_factory=SplitConfig)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)
