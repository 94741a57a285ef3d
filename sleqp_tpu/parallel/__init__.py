"""Instance batching and multi-device sharding for the SQP solver."""
