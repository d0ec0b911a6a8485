"""Scene "models": alias package re-exporting the scene registry/builders
(the renderer's analog of a model zoo)."""
from raytracer_tpu.scenes.builders import *  # noqa: F401,F403
from raytracer_tpu.scenes.registry import SCENES, get_scene  # noqa: F401
