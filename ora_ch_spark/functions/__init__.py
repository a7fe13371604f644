from ora_ch_spark.functions.params import bind_params
from ora_ch_spark.functions.dialect import translate_ch_sql

__all__ = ["bind_params", "translate_ch_sql"]
