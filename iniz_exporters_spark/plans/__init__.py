from iniz_exporters_spark.plans.graph import (  # noqa: F401
    CycleError,
    reachable_from,
    detect_cycles,
    topo_order,
    distributed_reachable,
    distributed_topo_levels,
)
