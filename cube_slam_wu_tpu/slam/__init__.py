"""SLAM back-end: factor-graph state, LM bundle adjustment, incremental driver."""
