// Compatibility shim: the reference includes the removed OpenCV1 header
// <opencv/cv.h> and uses a handful of legacy constants. Map them to the
// OpenCV4 equivalents.
#pragma once
#include <opencv2/opencv.hpp>
#include <opencv2/imgproc/types_c.h>
#include <opencv2/highgui/highgui_c.h>

#ifndef CV_BGR2GRAY
#define CV_BGR2GRAY cv::COLOR_BGR2GRAY
#endif
#ifndef CV_AA
#define CV_AA cv::LINE_AA
#endif
#ifndef CV_DIST_L2
#define CV_DIST_L2 cv::DIST_L2
#endif
