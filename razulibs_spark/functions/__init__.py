from razulibs_spark.functions.scalars import (  # noqa: F401
    date_type_classify,
    dec_sum,
    full_extension,
    filename_stem,
    normalize_path,
    parse_rd_coord,
    razu_filename,
    razu_s3_key,
    razu_uid,
    razu_uri,
    wkt_bbox_polygon,
)
