"""Plasm: the dataflow graph of cells + connections.

The ecto ``Plasm`` analog (reference usage: apps/feature_viewer:43-50). The
graph structure (nodes, edges, topological order, cycle detection) is handled
by the native C++ core (tod_tpu/native/src/tod_native.cc tod_toposort),
mirroring where the reference keeps its scheduler machinery.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Iterable, List, Sequence, Tuple, Union

from tod_tpu.pipeline.cell import Cell


@dataclass(frozen=True)
class Connection:
    src: Cell
    src_port: str
    dst: Cell
    dst_port: str

    def propagate(self) -> None:
        self.dst.inputs[self.dst_port] = self.src.outputs[self.src_port]


class Plasm:
    def __init__(self):
        self.cells: List[Cell] = []
        self.connections: List[Connection] = []

    def insert(self, cell: Cell) -> None:
        if cell not in self.cells:
            self.cells.append(cell)

    def connect(self, *connections: Union[Connection, Iterable[Connection]]) -> None:
        for item in connections:
            conns = [item] if isinstance(item, Connection) else list(item)
            for c in conns:
                if c.src_port not in c.src.outputs:
                    raise KeyError(
                        f"{c.src.name} has no output {c.src_port!r}")
                if c.dst_port not in c.dst.inputs:
                    raise KeyError(
                        f"{c.dst.name} has no input {c.dst_port!r}")
                self.insert(c.src)
                self.insert(c.dst)
                self.connections.append(c)

    def toposorted(self) -> List[Cell]:
        from tod_tpu.native import toposort
        index = {id(c): i for i, c in enumerate(self.cells)}
        edges = [(index[id(c.src)], index[id(c.dst)])
                 for c in self.connections]
        order = toposort(len(self.cells), edges)
        return [self.cells[i] for i in order]

    def execute(self, niter: int = 1) -> None:
        from tod_tpu.pipeline.scheduler import Scheduler
        Scheduler(self).execute(niter)
