"""Training steps for the avatar model families.

The reference ships training helpers but its runtime is inference-only
(SURVEY §5 checkpoint/resume); these modules provide TPU-native training
loops (pjit over a Mesh, optax) for fine-tuning avatars and for the
multi-chip dry-run contract.
"""
