"""Graph engine: build, fragments, superstep driver, vertex programs."""
