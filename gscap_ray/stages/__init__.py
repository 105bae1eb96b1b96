"""Ray Data stages: stateless ``map_batches`` functions and actor-pool
classes wrapping the pure kernels in ``gscap_ray.functions``."""
