from sparkdiff.sources.catalog import SchemaCatalog  # noqa: F401
from sparkdiff.sources.scripts import pair_scripts, read_script_dir  # noqa: F401
