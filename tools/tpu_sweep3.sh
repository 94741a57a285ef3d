#!/bin/bash
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
{
  echo "=== fused mixed+enum b512 $(date +%T)"
  timeout 1800 python tools/tpu_probe.py fused float32 float64 512
  echo "=== fused mixed+enum b1024 $(date +%T)"
  timeout 1800 python tools/tpu_probe.py fused float32 float64 1024
  echo "=== done $(date +%T)"
} 2>&1 | grep -v "log file\|Could not open any" > tools/tpu_sweep3.log
