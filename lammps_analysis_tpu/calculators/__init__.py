"""calculators subpackage."""
