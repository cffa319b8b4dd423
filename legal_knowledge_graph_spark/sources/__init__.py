"""Sources & sinks: stage tables, checkpoint manifest, graph store."""
