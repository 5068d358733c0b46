"""Back-compat shim: this module was renamed to littles_law
(round-9 naming-debt cleanup, VERDICT r8 item 8). Importing it binds
every public and private name of the renamed module; query keys are
registered by the renamed module exactly once."""

from etl_framework_spark.queries import littles_law as _renamed

globals().update(
    {k: v for k, v in vars(_renamed).items() if not k.startswith("__")}
)
del _renamed
