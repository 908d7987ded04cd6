"""Engine operators over the edge DataFrame."""
