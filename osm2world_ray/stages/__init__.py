"""Ray Data stages: batch transforms and actor-pool classes.

Each module maps one operator family from SURVEY.md §2 into the Ray
Data execution model: stateless kernels as plain ``map_batches``
functions, build-once/probe-many state as callable classes run with
``concurrency=N`` (actor pools), wide steps as explicit keyed shuffles.
"""
