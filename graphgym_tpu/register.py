"""Registry / plugin system (reference graphgym/register.py:6-70).

Fifteen registries mirroring the reference's extension points; contrib
packages register themselves on import (see graphgym_tpu.contrib).
"""

from __future__ import annotations

from typing import Any, Callable, Dict


def register(key: str, module: Any, module_dict: Dict[str, Any]) -> None:
    if key in module_dict:
        raise KeyError(f"Key {key} is already pre-defined.")
    module_dict[key] = module


act_dict: Dict[str, Any] = {}
node_encoder_dict: Dict[str, Any] = {}
edge_encoder_dict: Dict[str, Any] = {}
stage_dict: Dict[str, Any] = {}
head_dict: Dict[str, Any] = {}
layer_dict: Dict[str, Any] = {}
pooling_dict: Dict[str, Any] = {}
network_dict: Dict[str, Any] = {}
config_dict: Dict[str, Any] = {}
loader_dict: Dict[str, Any] = {}
optimizer_dict: Dict[str, Any] = {}
scheduler_dict: Dict[str, Any] = {}
loss_dict: Dict[str, Any] = {}
feature_augment_dict: Dict[str, Any] = {}
train_dict: Dict[str, Any] = {}


def _make(d: Dict[str, Any]) -> Callable[[str, Any], None]:
    def _register(key: str, module: Any) -> None:
        register(key, module, d)
    return _register


register_act = _make(act_dict)
register_node_encoder = _make(node_encoder_dict)
register_edge_encoder = _make(edge_encoder_dict)
register_stage = _make(stage_dict)
register_head = _make(head_dict)
register_layer = _make(layer_dict)
register_pooling = _make(pooling_dict)
register_network = _make(network_dict)
register_config = _make(config_dict)
register_loader = _make(loader_dict)
register_optimizer = _make(optimizer_dict)
register_scheduler = _make(scheduler_dict)
register_loss = _make(loss_dict)
register_feature_augment = _make(feature_augment_dict)
register_train = _make(train_dict)
