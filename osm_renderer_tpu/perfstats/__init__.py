from osm_renderer_tpu.perfstats.spans import (
    PerfStats,
    finish_tile,
    measure,
    start_tile,
)

__all__ = ["PerfStats", "finish_tile", "measure", "start_tile"]
