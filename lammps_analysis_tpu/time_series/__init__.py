"""time_series subpackage."""
