"""Device-mesh parallelism: shardings, collectives, multi-host."""
