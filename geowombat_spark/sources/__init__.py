"""Sources and sinks subpackage."""
