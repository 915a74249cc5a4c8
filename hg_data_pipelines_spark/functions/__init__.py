"""Column-level function library: text fingerprinting and panorama geometry."""
