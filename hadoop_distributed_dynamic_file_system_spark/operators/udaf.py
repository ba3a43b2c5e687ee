"""User-defined aggregate surface (SURVEY §2.10).

Reference: mapred/lib/aggregate/UserDefinedValueAggregatorDescriptor.java
— a user class plugged into the aggregation framework by name. The
Spark-first equivalent is an Arrow-batched GROUPED_AGG pandas UDF:
JVM→Arrow batch transfer, vectorized numpy math, usable inside any
groupBy().agg() alongside built-ins.

NOTE: no `from __future__ import annotations` here — pandas_udf infers
the UDF type from *evaluated* annotations; stringified ones break it.
"""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def geomean(v: pd.Series) -> float:
    """Geometric mean — an aggregate the built-in F.* set lacks."""
    return float(np.exp(np.log(v.to_numpy()).mean()))


@pandas_udf("double")
def midrange(v: pd.Series) -> float:
    """(min+max)/2 — second example registered aggregator."""
    arr = v.to_numpy()
    return float((arr.min() + arr.max()) / 2.0)


@pandas_udf("long")
def count_agg(v: pd.Series) -> int:
    """Spark disallows mixing GROUPED_AGG pandas UDFs with JVM
    aggregates in one agg(); this keeps counts on the pandas side."""
    return int(len(v))


# The descriptor-DSL registry hook: name → aggregator, the analog of
# UserDefinedValueAggregatorDescriptor's class-by-name plug-in.
REGISTRY = {"GeoMean": geomean, "MidRange": midrange, "CountAgg": count_agg}
