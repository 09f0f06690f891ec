"""Ray-Data-native rebuild of the Link_Profiler query/data-processing engine.

This is a from-scratch engine: ``ray.data.Dataset`` pipelines of
``map_batches`` over zero-copy Arrow batches, actor pools for stateful
stages (URL-seen set, politeness), groupby/aggregate/sort for the wide
steps.  Semantics (NOT code) follow the reference repo
altommo/Link_Profiler_Repo; see SURVEY.md for the operator inventory
and per-operator reference citations.

Nothing in this package calls ``ray.init()`` — the hosting process
(driver, bench.py, pytest fixture) owns the Ray session.
"""

__version__ = "0.1.0"
