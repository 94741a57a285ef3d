#!/bin/bash
# Sequential TPU probes; fused (crash-prone) last. Logs to tools/tpu_sweep.log.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
{
  echo "=== stepped mixed f64 b64 $(date +%T)"
  timeout 1200 python tools/tpu_probe.py stepped float32 float64 64
  echo "=== stepped pure-f32 b64 $(date +%T)"
  timeout 1200 python tools/tpu_probe.py stepped same float32 64
  echo "=== stepped mixed f64 b1024 $(date +%T)"
  timeout 1200 python tools/tpu_probe.py stepped float32 float64 1024
  echo "=== fused mixed f64 b64 $(date +%T)"
  timeout 1800 python tools/tpu_probe.py fused float32 float64 64
  echo "=== done $(date +%T)"
} 2>&1 | grep -v "log file\|Could not open any" > tools/tpu_sweep.log
