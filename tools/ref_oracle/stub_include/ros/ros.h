// Stub: the reference sources include <ros/ros.h> but use no ROS symbols
// in the detect_3d_cuboid library (only the demo driver does, which we
// replace with our own). Empty on purpose.
#pragma once
