"""A miniature model/disc/loss config with the production topology (5 encoder
stages, 5 decoder stages, K5 graphs) but tiny channel counts, for fast
CPU tests.  Input size 32x64."""

TINY_MODEL = {
    "encoder": {
        "nodes": 5,
        "seed": 42,
        "layers": [
            {"in_channels": 3, "out_channels": 8, "kernel_size": 3, "heads": 2},
            {"in_channels": 8, "out_channels": 8, "kernel_size": 3, "heads": 2},
            {"in_channels": 8, "out_channels": 16, "kernel_size": 3, "heads": 2},
            {"in_channels": 16, "out_channels": 16, "kernel_size": 3, "heads": 2},
            {"in_channels": 16, "out_channels": 32, "kernel_size": 3, "heads": 2},
        ],
    },
    "decoder": {
        "layers": [
            {"in_channels": 32, "feature_in_channels": 16, "skip_in_channels": 32,
             "upsample_channels": 8, "out_channels": 16, "skip_out_channels": 32,
             "concat_disp": False, "calculate_disp": False},
            {"in_channels": 16, "feature_in_channels": 16, "skip_in_channels": 32,
             "upsample_channels": 4, "out_channels": 16, "skip_out_channels": 16,
             "concat_disp": False, "calculate_disp": True, "disp_channels": 4},
            {"in_channels": 16, "feature_in_channels": 8, "skip_in_channels": 16,
             "upsample_channels": 4, "out_channels": 16, "skip_out_channels": 16,
             "concat_disp": True, "calculate_disp": True, "disp_channels": 4},
            {"in_channels": 16, "feature_in_channels": 8, "skip_in_channels": 16,
             "upsample_channels": 4, "out_channels": 16, "skip_out_channels": 16,
             "concat_disp": True, "calculate_disp": True, "disp_channels": 4},
            {"in_channels": 16, "feature_in_channels": 3, "skip_in_channels": 16,
             "upsample_channels": 4, "out_channels": 16, "skip_out_channels": 16,
             "concat_disp": True, "calculate_disp": True, "disp_channels": 4},
        ],
    },
}

# input 32x64 -> final feature 1x2 after 5 stride-2 stages
TINY_DISCRIMINATOR = {
    "nodes": 5,
    "seed": 42,
    "layers": [
        {"in_channels": 6, "out_channels": 8, "kernel_size": 3, "heads": 2},
        {"in_channels": 14, "out_channels": 8, "kernel_size": 3, "heads": 2},
        {"in_channels": 14, "out_channels": 16, "kernel_size": 3, "heads": 2},
        {"in_channels": 22, "out_channels": 16, "kernel_size": 3, "heads": 2},
    ],
    "final_conv": {"in_channels": 16, "out_channels": 16, "kernel_size": 3, "heads": 2},
    "linear_in_features": 32,
}

TINY_LOSS = {
    "wssim_weight": 1.0,
    "consistency_weight": 1.0,
    "smoothness_weight": 1.0,
    "adversarial_weight": 0.85,
    "perceptual_weight": 0.05,
    "predictive_error_weight": 1.0,
    "wssim_alpha": 0.85,
    "perceptual_start": 2,
    "adversarial_loss_type": "mse",
    "error_loss_config": {
        "loss_type": "l1",
        "smoothness_weight": 0,
        "consistency_weight": 0.5,
        "pooling": False,
    },
}

TINY_INPUT = (32, 64)
