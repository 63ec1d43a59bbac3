"""Rendering pipeline: tracer (ray-scene intersection), integrator
(wavefront light transport), driver (passes, accumulation, output)."""
