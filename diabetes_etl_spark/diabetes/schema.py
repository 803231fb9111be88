"""Declared input schema for the diabetes medallion pipeline.

Mirrors the reference's fixed bronze contract (schema inference
disabled): 7 integer measures + 2 doubles, all nullable
(reference: src/diabetes_etl_pipeline.py:26-36,67-68).
"""

from __future__ import annotations

from pyspark.sql import types as T

DIABETES_SCHEMA = T.StructType(
    [
        T.StructField("Pregnancies", T.IntegerType(), True),
        T.StructField("Glucose", T.IntegerType(), True),
        T.StructField("BloodPressure", T.IntegerType(), True),
        T.StructField("SkinThickness", T.IntegerType(), True),
        T.StructField("Insulin", T.IntegerType(), True),
        T.StructField("BMI", T.DoubleType(), True),
        T.StructField("DiabetesPedigreeFunction", T.DoubleType(), True),
        T.StructField("Age", T.IntegerType(), True),
        T.StructField("Outcome", T.IntegerType(), True),
    ]
)

# Fallback medians used only when a measure has no nonzero values at all
# (empty-input guard; reference: pipeline:124-155).
FALLBACK_MEDIANS = {
    "Glucose": 117.0,
    "BloodPressure": 72.0,
    "SkinThickness": 23.0,
    "Insulin": 125.0,
    "BMI": 32.3,
}
