"""Multi-device execution: mesh construction and sharded wavefront steps."""
