"""Grid search over detector/check parameters (reference
alexp/.../evaluation/GridSearch.java:50-112: cartesian sweep, results sorted
by the objective).

Driver-side loop by design: each trial is itself a distributed Spark job, so
trials run sequentially to keep the cluster saturated by one job at a time
(the reference used a thread pool because its trials were single-threaded)."""

from __future__ import annotations

import itertools
from collections.abc import Callable


def grid_search(
    param_grid: dict[str, list],
    run_fn: Callable[[dict], float],
    higher_is_better: bool = True,
) -> list[tuple[dict, float]]:
    """Evaluate run_fn on the cartesian product of param_grid; return
    [(params, objective)] sorted best-first."""
    keys = list(param_grid)
    results = []
    for combo in itertools.product(*(param_grid[k] for k in keys)):
        params = dict(zip(keys, combo))
        results.append((params, float(run_fn(params))))
    return sorted(results, key=lambda r: r[1], reverse=higher_is_better)
