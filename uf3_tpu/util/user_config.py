"""
YAML settings with type-checked defaults and the handler factory that
builds DataCoordinator / ChemicalSystem / BSplineBasis / BasisFeaturizer
/ WeightedLinearModel objects from one configuration dictionary.

Capability parity with uf3/util/user_config.py and
uf3/default_options.yaml.
"""

import os
import re
from typing import Dict

import numpy as np
import yaml

import uf3_tpu
from uf3_tpu.data import composition, elements, io
from uf3_tpu.regression import least_squares
from uf3_tpu.representation import basis, process


def get_element_tuple(string: str):
    element_tuple = re.compile("[A-Z][a-z]?").findall(string)
    return tuple(sorted(element_tuple,
                        key=lambda el: elements.atomic_numbers[el]))


def type_check(value, reference):
    """Coerce a user-supplied ``value`` toward the type of the packaged
    default ``reference``.  Scalars cast when the cast is meaningful
    (YAML often parses numbers as strings), sequences normalize to
    lists, and dicts recurse through consistency_check; anything else
    passes through untouched so unknown shapes fail later with a clear
    error at the consuming handler."""
    if isinstance(reference, bool):
        return bool(value)
    if isinstance(reference, (int, float, np.floating)) \
            and isinstance(value, (int, float, np.floating, str)):
        return type(reference)(value)
    if isinstance(reference, (list, tuple)) \
            and isinstance(value, (list, tuple)):
        return list(value)
    if isinstance(reference, dict):
        return consistency_check(value, reference)
    return value


def consistency_check(settings: Dict, reference: Dict) -> Dict:
    """Merge ``settings`` over the ``reference`` defaults: unknown keys
    drop, missing keys fill from the defaults, shared keys coerce."""
    return {key: type_check(settings[key], default)
            if key in settings else default
            for key, default in reference.items()}


def read_config(settings_filename: str) -> Dict:
    """Load YAML settings; file entries override the packaged defaults
    only when the value types are compatible."""
    default_config = os.path.join(os.path.dirname(uf3_tpu.__file__),
                                  "default_options.yaml")
    with open(default_config) as f:
        default_settings = yaml.load(f, Loader=yaml.Loader)
    with open(settings_filename) as f:
        settings = yaml.load(f, Loader=yaml.Loader)
    for key in settings:
        if key in default_settings:
            settings[key] = type_check(settings[key],
                                       default_settings[key])
    return settings


def _build_data(settings, handlers):
    return io.DataCoordinator.from_config(settings["data"]["keys"])


def _build_chemical_system(settings, handlers):
    if not settings["elements"]:
        return None
    return composition.ChemicalSystem(element_list=settings["elements"],
                                      degree=settings["degree"])


def _build_basis(settings, handlers):
    block = {**settings["basis"], **handlers["chemical_system"].as_dict()}
    return basis.BSplineBasis.from_dict(block)


def _build_features(settings, handlers):
    block = settings["features"]
    return process.BasisFeaturizer(
        handlers["basis"],
        fit_forces=block.get("fit_forces", True),
        prefix=block.get("column_prefix", "x"))


def _build_model(settings, handlers):
    model_path = settings["model"].get("model_path", "")
    if not os.path.isfile(model_path):
        return None
    model = least_squares.WeightedLinearModel(handlers["basis"])
    model.load(filename=model_path)
    return model


def _build_learning(settings, handlers):
    # YAML spells the penalties out ("curvature_2b"); the model kwargs
    # use the short forms ("c_2b", "ridge" -> "r").
    reg = {k.replace("curvature", "c").replace("ridge", "r"): v
           for k, v in settings["learning"]["regularizer"].items()}
    return least_squares.WeightedLinearModel(handlers["basis"], **reg)


# handler name -> (settings keys required, handlers required, builder).
# Order matters: later builders consume earlier handlers.
_HANDLER_RECIPES = (
    ("data", ("data",), (), _build_data),
    ("chemical_system", ("elements", "degree"), (), _build_chemical_system),
    ("basis", ("basis",), ("chemical_system",), _build_basis),
    ("features", ("features",), ("basis",), _build_features),
    ("model", ("model",), ("basis",), _build_model),
    ("learning", ("learning",), ("basis",), _build_learning),
)


def generate_handlers(settings: Dict) -> Dict:
    """Build pipeline objects from a configuration dictionary.  Each
    handler is attempted only when its settings sections and upstream
    handlers exist; malformed sections are skipped, not fatal."""
    handlers: Dict = {}
    for name, needs_settings, needs_handlers, build in _HANDLER_RECIPES:
        if not all(k in settings for k in needs_settings):
            continue
        if not all(h in handlers for h in needs_handlers):
            continue
        try:
            built = build(settings, handlers)
        except (KeyError, ValueError):
            continue
        if built is not None:
            handlers[name] = built
    return handlers
