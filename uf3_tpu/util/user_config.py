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
    type_target = type(reference)
    type_user = type(value)
    if type_target is bool:
        return bool(value)
    if type_target in (int, float, np.floating):
        if type_user in (int, float, np.floating, str):
            return type_target(value)
    elif type_target in (list, tuple):
        if type_user in (list, tuple):
            return list(value)
    elif type_target is dict:
        return consistency_check(value, reference)
    elif type_target is type_user or reference is None:
        return value
    return value


def consistency_check(settings: Dict, reference: Dict) -> Dict:
    settings = {k: v for k, v in settings.items() if k in reference}
    for key in reference:
        if key in settings:
            settings[key] = type_check(settings[key], reference[key])
        else:
            settings[key] = reference[key]
    return settings


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


def generate_handlers(settings: Dict) -> Dict:
    """Build pipeline objects from a configuration dictionary."""
    handlers: Dict = {}
    if "data" in settings:
        try:
            handlers["data"] = io.DataCoordinator.from_config(
                settings["data"]["keys"])
        except (KeyError, ValueError):
            pass
    if "elements" in settings and "degree" in settings \
            and settings["elements"]:
        try:
            handlers["chemical_system"] = composition.ChemicalSystem(
                element_list=settings["elements"],
                degree=settings["degree"])
        except (KeyError, ValueError):
            pass
    if "basis" in settings and "chemical_system" in handlers:
        block = dict(settings["basis"])
        block.update(handlers["chemical_system"].as_dict())
        try:
            handlers["basis"] = basis.BSplineBasis.from_dict(block)
        except (KeyError, ValueError):
            pass
    if "features" in settings and "basis" in handlers:
        try:
            handlers["features"] = process.BasisFeaturizer(
                handlers["basis"],
                fit_forces=settings["features"].get("fit_forces", True),
                prefix=settings["features"].get("column_prefix", "x"))
        except (KeyError, ValueError):
            pass
    if "model" in settings and "basis" in handlers:
        model_path = settings["model"].get("model_path", "")
        if os.path.isfile(model_path):
            try:
                model = least_squares.WeightedLinearModel(
                    handlers["basis"])
                model.load(filename=model_path)
                handlers["model"] = model
            except (KeyError, ValueError):
                pass
    if "learning" in settings and "basis" in handlers:
        try:
            reg_params = settings["learning"]["regularizer"]
            reg_params = {k.replace("curvature", "c").replace("ridge",
                                                              "r"): v
                          for k, v in reg_params.items()}
            handlers["learning"] = least_squares.WeightedLinearModel(
                handlers["basis"], **reg_params)
        except (KeyError, ValueError):
            pass
    return handlers
