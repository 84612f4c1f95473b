"""Pipeline models: fixed-capacity feature table, the jitted VO step, and
sliding-window bundle adjustment."""
