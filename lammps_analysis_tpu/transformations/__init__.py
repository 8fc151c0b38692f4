"""transformations subpackage."""
