"""Pure-metadata core: no Spark imports allowed in this subpackage."""
