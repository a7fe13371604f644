from ora_ch_spark.plans.calc import CalcEngine
from ora_ch_spark.plans.scheduler import TaskScheduler

__all__ = ["CalcEngine", "TaskScheduler"]
