"""People detection — TPU-native equivalent of the reference ``people/``
module (SURVEY §2.13): ground-plane RGB-D person detection via HOG + linear
SVM over candidate clusters.
"""

from pcl_tpu.people.hog import hog_features
from pcl_tpu.people.detector import GroundBasedPeopleDetector
from pcl_tpu.people.classifier import PersonClassifier
