"""Load operations O1–O5 (reference dispatch:
``task/TaskLogic.scala:285-348``) + the LLM-pipeline extension
operators (dedup / similarity / text / multimodal)."""

from ora_ch_spark.operators.load_ops import (
    apply_operation,
    op_append_bymax,
    op_append_notin,
    op_append_where,
    op_recreate,
    op_update,
    shape_source,
)

__all__ = [
    "apply_operation",
    "op_recreate",
    "op_append_where",
    "op_append_bymax",
    "op_append_notin",
    "op_update",
    "shape_source",
]
