#!/bin/bash
# Environment setup (replaces the reference's macos_setup.sh): create a venv
# with the JAX TPU stack and build the native loader.
set -e
cd "$(dirname "$0")/.."

python -m venv venv
. ./venv/bin/activate

pip install --upgrade pip
pip install "jax[tpu]" flax optax orbax-checkpoint pyyaml pillow numpy \
    matplotlib pytest

echo "Building native stereo loader."
make -C native || echo "native loader build failed; PIL fallback will be used"

echo "Done."
