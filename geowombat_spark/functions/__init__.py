"""Band-math and radiometry functions subpackage."""
