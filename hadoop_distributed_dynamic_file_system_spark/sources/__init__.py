"""Sources: readers mirroring the reference's InputFormat inventory."""
