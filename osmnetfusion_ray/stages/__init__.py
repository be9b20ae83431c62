"""Operator stages: each module exposes vectorized ``map_batches`` callables
(stateless functions or actor-pool classes) over Arrow batches."""
