#!/bin/bash
# Zip the framework for deployment (reference scripts/package_model.sh),
# excluding VCS, caches, build artefacts and training outputs.
cd "$(dirname "$0")/.."

find . -not \( \
    -name ".DS_Store" \
    -or -path "./.git*" \
    -or -path "*__pycache__*" \
    -or -path "./.jax_cache*" \
    -or -path "./tests/.jax_cache*" \
    -or -path "./native/build*" \
    -or -path "./venv*" \
    -or -path "./trained*" \
    -or -path "./results*" \) | zip -@ model-package
