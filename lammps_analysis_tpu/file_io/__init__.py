"""file_io subpackage."""
