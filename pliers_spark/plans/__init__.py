"""Plan layer: pipeline spec (Graph parity), checkpoint/lineage/resume."""
