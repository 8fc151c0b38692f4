"""visualizer subpackage."""
