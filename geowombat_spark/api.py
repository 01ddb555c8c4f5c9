"""Reference-named API facade: the geowombat surface, one import away.

A geowombat user's muscle memory maps 1:1 —

    import geowombat_spark.api as gw

    with gw.config(nodata=0.0):
        docs = gw.open(spark, "/path/to/corpus")            # gw.open
        pts  = gw.extract(spark, docs, aoi, grid)           # gw.extract
        sub  = gw.clip_by_polygon(docs, polys, grid)        # gw.clip
        out  = gw.ndvi(sub, "band_red", "band_nir")         # gw.norm_diff family
        gw.save(out, "/path/out")                           # gw.save / to_raster

Each name delegates to the module that implements it (cited there with
reference file:line); this module adds no behavior — it is the dispatch
table ``core/api.py:291-655`` collapses to once scan/mosaic/concat/warp are
separate composable functions.
"""

from __future__ import annotations

from .config import config  # noqa: F401  (gw.config.update analogue)
from .crs import lonlat_to_utm, reproject_points, utm_to_lonlat  # noqa: F401
from .functions.nodata import band_mask, mask_nodata, set_nodata  # noqa: F401
from .functions.radiometry import (  # noqa: F401
    bandpass,
    dn_to_radiance,
    dn_to_toar,
    qa_mask,
    radiance_to_toar,
)
from .functions.vi import (  # noqa: F401
    avi,
    compare,
    evi,
    evi2,
    gcvi,
    kndvi,
    linear_transform,
    nbr,
    ndvi,
    norm_diff,
    tasseled_cap,
    wi,
)
from .grid import GridSpec, align_bounds  # noqa: F401
from .operators.extract import (  # noqa: F401
    extract_points as extract,
)
from .operators.extract import extract_polygons, prepare_points  # noqa: F401
from .operators.focal import moving  # noqa: F401
from .operators.knn import knn_join, near_pairs  # noqa: F401
from .operators.mosaic import concat, file_bounds, mosaic  # noqa: F401
from .operators.polygonize import (  # noqa: F401
    connected_components as array_to_polygon,
)
from .operators.rasterize import polygon_to_array  # noqa: F401
from .operators.sample import (  # noqa: F401
    sample_random,
    sample_stratified,
    sample_systematic,
)
from .operators.sops import (  # noqa: F401
    calc_area,
    clip_by_polygon,
    mask,
    recode,
    replace,
    subset,
)
from .operators.temporal import (  # noqa: F401
    apply_blocks as apply,
)
from .operators.temporal import group_dates, series_apply, series_stats  # noqa: F401
from .operators.transform import match_layout, transform_grid as transform_crs  # noqa: F401
from .plans.checkpoint import (  # noqa: F401
    write_tiled_checkpointed as save,
)
from .sources.tables import get_spark, load_documents as open  # noqa: F401,A001
