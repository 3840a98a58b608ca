"""Runtime: inference engine, batching, precision policies, profiling."""
