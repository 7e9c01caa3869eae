"""Pure-numpy geometry kernels (no Ray dependency).

These mirror the semantics of the reference's math package
(``core/src/main/java/org/osm2world/math``) but are vectorized over
numpy arrays so they can run inside ``map_batches`` on Arrow columns.
"""
