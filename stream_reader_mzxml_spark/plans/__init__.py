"""Query plans: reference analytics programs + the driver-contract battery."""
