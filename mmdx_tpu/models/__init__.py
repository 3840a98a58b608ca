"""Pure-functional flax models: resnet50, bert, t5, fusion, diagnosis."""
