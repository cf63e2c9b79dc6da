#!/usr/bin/env bash
# Build + deploy (reference parity: deploy.sh — build image, push, roll
# the k8s deployment, post-deploy health check).
set -euo pipefail

IMAGE="${IMAGE:-s2sr-tpu}"
TAG="${TAG:-$(git rev-parse --short HEAD)}"
REGISTRY="${REGISTRY:-}"
NAMESPACE="${NAMESPACE:-default}"
HEALTH_URL="${HEALTH_URL:-}"

full_image="${REGISTRY:+$REGISTRY/}$IMAGE:$TAG"

echo "==> building $full_image"
docker build -t "$full_image" .

if [[ -n "$REGISTRY" ]]; then
  echo "==> pushing $full_image"
  docker push "$full_image"
fi

echo "==> rolling deployment"
kubectl -n "$NAMESPACE" set image deployment/s2sr-tpu server="$full_image"
kubectl -n "$NAMESPACE" rollout status deployment/s2sr-tpu --timeout=300s

if [[ -n "$HEALTH_URL" ]]; then
  echo "==> post-deploy health check"
  for i in $(seq 1 10); do
    if curl -sf "$HEALTH_URL/health" >/dev/null; then
      echo "healthy"
      exit 0
    fi
    sleep 5
  done
  echo "health check failed" >&2
  exit 1
fi
