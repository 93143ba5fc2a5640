"""Pipeline runtime tests: tendrils, cells, plasm scheduling, blackboxes."""

import numpy as np
import pytest

from tod_tpu.pipeline import (
    BlackBox,
    Cell,
    CellInfo,
    Forward,
    Plasm,
    Scheduler,
    Tendrils,
)
from tod_tpu.cells.io import Constant, Dealer, PassthroughN


class Doubler(Cell):
    @staticmethod
    def declare_io(p, i, o):
        i.declare("x", "input", default=0)
        o.declare("y", "output")

    def process(self):
        self.outputs["y"] = 2 * self.inputs["x"]


class Adder(Cell):
    @staticmethod
    def declare_io(p, i, o):
        i.declare("a", "lhs", default=0)
        i.declare("b", "rhs", default=0)
        o.declare("sum", "a+b")

    def process(self):
        self.outputs["sum"] = self.inputs["a"] + self.inputs["b"]


def test_tendrils_declare_and_access():
    t = Tendrils()
    t.declare("x", "doc", default=5)
    assert t["x"] == 5
    t["x"] = 7
    assert t.x == 7
    t.declare("req", "must be set", required=True)
    assert t.missing_required() == ["req"]


def test_cell_param_validation():
    with pytest.raises(ValueError):
        Constant("c", nonsense=1)


def test_plasm_executes_in_topo_order():
    c = Constant("c", value=3)
    d = Doubler("d")
    a = Adder("a")
    p = Plasm()
    p.connect(c["out"] >> d["x"])
    p.connect(c["out"] >> a["a"], d["y"] >> a["b"])
    p.execute(1)
    assert a.outputs["sum"] == 9  # 3 + 2*3


def test_plasm_detects_cycles():
    d1, d2 = Doubler("d1"), Doubler("d2")
    p = Plasm()
    p.connect(d1["y"] >> d2["x"])
    p.connect(d2["y"] >> d1["x"])
    with pytest.raises(ValueError):
        p.toposorted()


def test_plasm_bad_port_raises():
    c, d = Constant("c", value=1), Doubler("d")
    p = Plasm()
    with pytest.raises(KeyError):
        p.connect(c["nope"] >> d["x"])


def test_multi_port_connection_sugar():
    class TwoOut(Cell):
        @staticmethod
        def declare_io(p, i, o):
            o.declare("p", "")
            o.declare("q", "")

        def process(self):
            self.outputs["p"], self.outputs["q"] = 1, 2

    t, a = TwoOut("t"), Adder("a")
    p = Plasm()
    p.connect(t["p", "q"] >> a["a", "b"])
    p.execute()
    assert a.outputs["sum"] == 3


def test_dealer_and_passthrough():
    d = Dealer("deal", iterable=["m1", "m2"])
    pt = PassthroughN("pt", items={"v": "a value"})
    p = Plasm()
    p.connect(d["out"] >> pt["v"])
    p.execute(2)
    assert pt.outputs["v"] == "m2"


class SmallBox(BlackBox):
    @classmethod
    def declare_cells(cls, p):
        return {"const": CellInfo(Constant, {"value": p["value"]}),
                "doubler": CellInfo(Doubler)}

    @classmethod
    def declare_forwards(cls, _p):
        return ({}, {}, {"doubler": [Forward("y", "result")]})

    @classmethod
    def declare_direct_params(cls, p):
        p.declare("value", "the seed value", default=1)

    def connections(self, p):
        return [self.const["out"] >> self.doubler["x"]]


def test_blackbox_composition():
    box = SmallBox("box", value=21)
    box.process()
    assert box.outputs["result"] == 42


def test_blackbox_forward_all():
    class AllBox(BlackBox):
        @classmethod
        def declare_cells(cls, p):
            return {"add": CellInfo(Adder)}

        @classmethod
        def declare_forwards(cls, _p):
            return ({}, {"add": "all"}, {"add": "all"})

    box = AllBox("box")
    box.inputs["a"] = 4
    box.inputs["b"] = 5
    box.process()
    assert box.outputs["sum"] == 9


def test_scheduler_timing_report():
    c, d = Constant("c", value=1), Doubler("d")
    p = Plasm()
    p.connect(c["out"] >> d["x"])
    s = Scheduler(p)
    s.execute(3)
    report = s.timing_report()
    assert "3 iterations" in report and "d" in report


def test_threaded_scheduler_levels():
    from tod_tpu.pipeline.scheduler import ThreadedScheduler

    c1, c2 = Constant("c1", value=2), Constant("c2", value=3)
    d1, d2 = Doubler("d1"), Doubler("d2")
    a = Adder("a")
    p = Plasm()
    p.connect(c1["out"] >> d1["x"])
    p.connect(c2["out"] >> d2["x"])
    p.connect(d1["y"] >> a["a"], d2["y"] >> a["b"])
    s = ThreadedScheduler(p, max_workers=2)
    s.execute(2)
    assert a.outputs["sum"] == 10  # 2*2 + 2*3
    assert s.n_iterations == 2
    # level structure: constants | doublers | adder
    assert [len(lvl) for lvl in s._levels] == [2, 2, 1]
