from tod_tpu.pipeline.tendril import Tendril, Tendrils
from tod_tpu.pipeline.cell import Cell, CellInfo, Forward
from tod_tpu.pipeline.plasm import Connection, Plasm
from tod_tpu.pipeline.scheduler import Scheduler, ThreadedScheduler
from tod_tpu.pipeline.blackbox import BlackBox
from tod_tpu.pipeline.ork import load_ork, build_pipeline_from_ork

__all__ = [
    "Tendril", "Tendrils", "Cell", "CellInfo", "Forward", "Connection",
    "Plasm", "Scheduler", "ThreadedScheduler", "BlackBox", "load_ork", "build_pipeline_from_ork",
]
