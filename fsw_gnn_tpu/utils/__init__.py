from .dsmetric import dsmetric
