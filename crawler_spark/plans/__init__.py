"""State-plane: snapshot-versioned tables and the log-structured frontier."""
