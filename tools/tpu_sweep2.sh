#!/bin/bash
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
{
  echo "=== fused mixed f64 b512 $(date +%T)"
  timeout 1800 python tools/tpu_probe.py fused float32 float64 512
  echo "=== fused mixed f64 b2048 $(date +%T)"
  timeout 1800 python tools/tpu_probe.py fused float32 float64 2048
  echo "=== done $(date +%T)"
} 2>&1 | grep -v "log file\|Could not open any" > tools/tpu_sweep2.log
